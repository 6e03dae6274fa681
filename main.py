#!/usr/bin/env python
"""CLI shim: `python main.py <args>` — same invocation shape as the
reference daemon (reference Code/main.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_metrics_exporter_spark.app import main

if __name__ == "__main__":
    sys.exit(main())
