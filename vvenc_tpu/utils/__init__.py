"""Utilities: YUV file I/O, statistics."""

from .yuv_io import read_yuv, write_yuv, read_y4m_header
from .stats import SequenceStats
