#!/usr/bin/env python
"""Thin wrapper over the shared demo CLI (reference keeps an identical
demo.py copy per dataset dir)."""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from demo import main  # noqa: E402

if __name__ == "__main__":
    main()
