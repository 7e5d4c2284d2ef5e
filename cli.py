#!/usr/bin/env python3
"""Repo-root CLI entry point (same invocation shape as the reference:
``python cli.py --model ... [--train/--tokenize/--benchmark/...]``)."""
from subword_tokenizers_tpu.cli import main

if __name__ == "__main__":
    main()
