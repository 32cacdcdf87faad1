"""Native (C++) host-runtime components, loaded via ctypes.

Compiled lazily with g++ on first use and cached next to the source; every
entry point has a pure-numpy fallback so the framework works without a
toolchain.  See ``ivf_pack.cpp`` for what lives here and why.
"""

from colbert_tpu.native.lib import ivf_pack, compact_active, native_available

__all__ = ["ivf_pack", "compact_active", "native_available"]
