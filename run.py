#!/usr/bin/env python
"""Unified entry point: python run.py {check,train,validate,predict} ...

The working equivalent of the reference's run.py (see
pcmseg_tpu/cli/main.py for the implementation and flag surface).
"""

import sys

from pcmseg_tpu.cli.main import main

if __name__ == "__main__":
    sys.exit(main())
