"""Thread-safe logging with user callback (vvenc MsgLog analog).

Reference: vvenc Utilities/MsgLog.h + vvenc_set_msg_callback
(vvencCfg.h:841).  Levels follow vvencMsgLevel: SILENT(0) ERROR(1)
WARNING(2) INFO(3) NOTICE(4) VERBOSE(5) DETAILS(6).

The encoder's user-facing output routes through the module-level `LOG`;
an application (or the C API) installs a callback with set_callback and
controls verbosity with set_level.
"""

from __future__ import annotations

import sys
import threading

SILENT, ERROR, WARNING, INFO, NOTICE, VERBOSE, DETAILS = range(7)

_NAMES = {ERROR: "error", WARNING: "warning", INFO: "info",
          NOTICE: "notice", VERBOSE: "verbose", DETAILS: "details"}


class MsgLog:
    def __init__(self, level: int = VERBOSE):
        self._level = level
        self._cb = None        # callable(level, text) or None
        self._lock = threading.Lock()

    def set_level(self, level: int) -> None:
        self._level = level

    def set_callback(self, cb) -> None:
        """cb(level: int, text: str); None restores stdout/stderr."""
        self._cb = cb

    def log(self, level: int, fmt: str, *args) -> None:
        if level > self._level or level == SILENT:
            return
        text = (fmt % args) if args else fmt
        with self._lock:
            if self._cb is not None:
                self._cb(level, text)
            else:
                stream = sys.stderr if level <= WARNING else sys.stdout
                stream.write(text if text.endswith("\n") else text + "\n")
                stream.flush()

    def error(self, fmt, *args):
        self.log(ERROR, fmt, *args)

    def warning(self, fmt, *args):
        self.log(WARNING, fmt, *args)

    def info(self, fmt, *args):
        self.log(INFO, fmt, *args)

    def notice(self, fmt, *args):
        self.log(NOTICE, fmt, *args)

    def verbose(self, fmt, *args):
        self.log(VERBOSE, fmt, *args)


LOG = MsgLog()
