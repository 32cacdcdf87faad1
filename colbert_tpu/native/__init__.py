"""Native (C++) host-runtime components, loaded via ctypes.

Compiled lazily with g++ on first use and cached next to the source; every
entry point has a pure-numpy fallback so the framework works without a
toolchain.  See ``ivf_pack.cpp`` for what lives here and why.
"""

from colbert_tpu.native.lib import balanced_assign, compact_active, ivf_pack, native_available

__all__ = ["balanced_assign", "compact_active", "ivf_pack", "native_available"]
