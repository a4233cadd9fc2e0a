#!/usr/bin/env python
"""Cache real-image Inception statistics for FID (reference get_real_stat.py)."""

from cat_tpu.entry import real_stat_main

if __name__ == "__main__":
    real_stat_main()
