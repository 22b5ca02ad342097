"""Minimal loguru stand-in for running the reference here.

Covers the surface the reference uses (vamb/__main__.py:702,709,932,2630,
vambtools.py:22,104): logger.remove/add/info/debug/warning/error,
logger.opt(raw=True), logger.catch(reraise=True). Formatting callables are
accepted but ignored — messages are written plainly with a timestamp; the
reference's colored format is cosmetic and irrelevant to parity runs.
"""

import functools
import sys
import time


class _Sink:
    def __init__(self, target):
        self.target = target
        self._file = None

    def write(self, text: str) -> None:
        if hasattr(self.target, "write"):
            self.target.write(text)
            if hasattr(self.target, "flush"):
                self.target.flush()
        else:  # a path
            if self._file is None:
                self._file = open(self.target, "a")
            self._file.write(text)
            self._file.flush()


class _Logger:
    def __init__(self):
        self._sinks: dict[int, _Sink] = {}
        self._next_id = 0
        self._raw = False

    # -- configuration ----------------------------------------------------
    def remove(self, handler_id=None) -> None:
        if handler_id is None:
            self._sinks.clear()
        else:
            self._sinks.pop(handler_id, None)

    def add(self, sink, **_kwargs) -> int:
        hid = self._next_id
        self._next_id += 1
        self._sinks[hid] = _Sink(sink)
        return hid

    # -- emission ----------------------------------------------------------
    def _log(self, level: str, message: str) -> None:
        if self._raw:
            text = str(message)
        else:
            stamp = time.strftime("%Y-%m-%d %H:%M:%S")
            text = f"{stamp} | {level:<7} | {message}\n"
        sinks = self._sinks or {0: _Sink(sys.stderr)}
        for sink in sinks.values():
            sink.write(text)

    def info(self, message, *args, **kwargs):
        self._log("INFO", message)

    def debug(self, message, *args, **kwargs):
        self._log("DEBUG", message)

    def warning(self, message, *args, **kwargs):
        self._log("WARNING", message)

    def error(self, message, *args, **kwargs):
        self._log("ERROR", message)

    # -- modifiers -----------------------------------------------------------
    def opt(self, raw: bool = False, **_kwargs) -> "_Logger":
        clone = _Logger.__new__(_Logger)
        clone._sinks = self._sinks
        clone._next_id = self._next_id
        clone._raw = raw
        return clone

    def catch(self, *dargs, reraise: bool = False, **_dkwargs):
        def decorator(fn):
            @functools.wraps(fn)
            def wrapped(*args, **kwargs):
                try:
                    return fn(*args, **kwargs)
                except Exception:
                    import traceback

                    self._log("ERROR", traceback.format_exc())
                    if reraise:
                        raise

            return wrapped

        # used bare (@logger.catch) or called (@logger.catch(reraise=True))
        if len(dargs) == 1 and callable(dargs[0]):
            return decorator(dargs[0])
        return decorator


logger = _Logger()
