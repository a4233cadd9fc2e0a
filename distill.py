#!/usr/bin/env python
"""Compression + distillation entry (reference distill.py)."""

from cat_tpu.entry import distill_main

if __name__ == "__main__":
    distill_main()
