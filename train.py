#!/usr/bin/env python
"""Teacher training entry (reference train.py)."""

from cat_tpu.entry import train_main

if __name__ == "__main__":
    train_main()
