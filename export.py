#!/usr/bin/env python
"""Student export entry (reference onnx_export.py): StableHLO / TFLite."""

from cat_tpu.entry import export_main

if __name__ == "__main__":
    export_main()
