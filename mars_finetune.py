#!/usr/bin/env python
"""Name-compatible entry point for Mars fine-tuning.

See `monodepth_tpu/cli/mars_finetune.py`.
"""

from monodepth_tpu.cli.mars_finetune import main

if __name__ == "__main__":
    raise SystemExit(main())
