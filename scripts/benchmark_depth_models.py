#!/usr/bin/env python
"""Name-compatible shim for the reference's scripts/benchmark_depth_models.py.

See monodepth_tpu/cli/benchmark_depth_models.py for the implementation.
"""

from monodepth_tpu.cli.benchmark_depth_models import main

if __name__ == "__main__":
    raise SystemExit(main())
