#!/usr/bin/env python
"""Name-compatible entry point for the simple monodepth CLI.

See `monodepth_tpu/cli/monodepth.py`.
"""

from monodepth_tpu.cli.monodepth import main

if __name__ == "__main__":
    raise SystemExit(main())
