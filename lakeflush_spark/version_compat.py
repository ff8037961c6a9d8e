"""Version triple of the reference API (``lakeflush/version.py:1-6``).

Kept equal to the reference's published version so code gating on
``(VERSION_MAJOR, VERSION_MINOR, VERSION_BUILD)`` sees the surface it
expects; the engine's own version lives in
``lakeflush_spark.__version__``.
"""

VERSION_MAJOR = 0
VERSION_MINOR = 1
VERSION_BUILD = 0
VERSION_INFO = (VERSION_MAJOR, VERSION_MINOR, VERSION_BUILD)
VERSION_STRING = f"{VERSION_MAJOR}.{VERSION_MINOR}.{VERSION_BUILD}"

# the reference exports the TUPLE as __version__ (its pyproject reads
# lakeflush.version.__version__) — mirrored verbatim, tuple not string
__version__ = VERSION_INFO
