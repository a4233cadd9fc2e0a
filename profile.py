#!/usr/bin/env python
"""Evaluation/profiling entry (reference profile.py): shrink-latency
benchmark, MAC/param accounting, XLA cost cross-check."""

from cat_tpu.entry import profile_main

if __name__ == "__main__":
    profile_main()
