#!/usr/bin/env python
"""Name-compatible entry point for the TPU-native Mars depth CLI.

Usage mirrors the reference `run_mars_depth.py`; see
`monodepth_tpu/cli/run_mars_depth.py` for the implementation.
"""

from monodepth_tpu.cli.run_mars_depth import main

if __name__ == "__main__":
    raise SystemExit(main())
