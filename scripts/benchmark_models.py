#!/usr/bin/env python
"""Name-compatible shim for the reference's scripts/benchmark_models.py.

See monodepth_tpu/cli/benchmark_models.py for the implementation.
"""

from monodepth_tpu.cli.benchmark_models import main

if __name__ == "__main__":
    raise SystemExit(main())
