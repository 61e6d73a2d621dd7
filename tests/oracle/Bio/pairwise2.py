"""pairwise2 stub delegating to jasper_tpu's aligner (see Bio/__init__.py)."""

import os
import sys

sys.path.insert(0, os.environ.get("JASPER_TPU_ROOT", "/root/repo"))

from jasper_tpu.utils.pairwise import globalms as _globalms  # noqa: E402


class _Align:
    @staticmethod
    def globalms(a, b, match, mismatch, gap_open, gap_extend):
        return _globalms(a, b, match, mismatch, gap_open, gap_extend)


align = _Align()


def format_alignment(*args, **kwargs):
    return ""
