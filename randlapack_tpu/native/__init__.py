"""Native (C++) runtime helpers. Build with ``native/build.sh``; every
consumer falls back to pure-Python/scipy paths when the extension is
absent, so the package works unbuilt."""
try:
    from ._randlapack_native import fast_mm_read, fast_mm_write  # noqa: F401
    HAVE_NATIVE = True
except ImportError:  # extension not built
    HAVE_NATIVE = False

    def fast_mm_read(path):  # noqa: D103
        raise ImportError("native extension not built; run native/build.sh")

    def fast_mm_write(path, rows, cols, vals, m, n):  # noqa: D103
        raise ImportError("native extension not built; run native/build.sh")

__all__ = ["fast_mm_read", "fast_mm_write", "HAVE_NATIVE"]
