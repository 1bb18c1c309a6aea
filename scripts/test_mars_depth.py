#!/usr/bin/env python
"""Name-compatible shim for the reference's scripts/test_mars_depth.py.

See monodepth_tpu/cli/test_mars_depth.py for the implementation.
"""

from monodepth_tpu.cli.test_mars_depth import main

if __name__ == "__main__":
    raise SystemExit(main())
