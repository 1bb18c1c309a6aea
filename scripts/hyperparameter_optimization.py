#!/usr/bin/env python
"""Name-compatible shim for the reference's scripts/hyperparameter_optimization.py.

See monodepth_tpu/cli/hyperparameter_optimization.py for the implementation.
"""

from monodepth_tpu.cli.hyperparameter_optimization import main

if __name__ == "__main__":
    raise SystemExit(main())
