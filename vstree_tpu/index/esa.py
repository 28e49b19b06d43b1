"""Enhanced suffix array (ESA) container.

TPU-native analog of the reference ``Virtualtree`` struct
(reference: src/include/virtualdef.h:186-219).  Differences by design:

- tables are flat device arrays (int32 ranks, uint8 text) in HBM rather
  than memory-mapped byte files; the 1-byte lcp + exception-pair
  encoding of the reference (virtualdef.h:121-136) exists only in the
  on-disk serialization (:mod:`vstree_tpu.index.io`), in memory lcp is
  plain int32,
- the suffix array covers ranks ``0..n`` where rank ``n`` holds the
  sentinel suffix at position ``n`` (the sentinel orders *after* every
  other suffix, matching the reference's "$ is greater than every
  symbol" convention, remainsort.c:73-127),
- ``bwttab[r] = text[suftab[r]-1]`` with ``UNDEFBWTCHAR`` at the rank
  of suffix 0 (reference kurtz/bwtcode.c:293-311).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np

from ..core.alphabet import Alphabet
from ..core.multiseq import Multiseq

# Table bits, mirroring the demand bitmask of virtualdef.h:24-98.
TISTAB = 1 << 0
SUFTAB = 1 << 1
LCPTAB = 1 << 2
BWTTAB = 1 << 3
BCKTAB = 1 << 4
STITAB = 1 << 5
OISTAB = 1 << 6
STI1TAB = 1 << 7
SKPTAB = 1 << 8
DESTAB = 1 << 9
SSPTAB = 1 << 10
LLVTAB = 1 << 11


@dataclass
class ESA:
    """Enhanced suffix array over an encoded Multiseq.

    All big tables are NumPy arrays host-side; device placement happens
    in the engine layer (arrays are moved to HBM once per session and
    reused across queries).
    """

    multiseq: Multiseq
    alpha: Alphabet
    suftab: np.ndarray          # int32[n+1], suffix start positions by rank
    lcptab: np.ndarray | None = None   # int32[n+1], lcp with previous rank
    bwttab: np.ndarray | None = None   # uint8[n+1]
    bcktab: np.ndarray | None = None   # uint32[2*numofcodes] (left, mid)
    stitab: np.ndarray | None = None   # int32[n+1], inverse of suftab
    skptab: np.ndarray | None = None   # int32[n+1]
    prefixlength: int = 0
    longest: int = 0            # rank of suffix 0
    maxbranchdepth: int = 0
    largelcpvalues: int = 0     # count of lcp values >= 255 (for .prj)
    indexname: str = ""
    _device_cache: dict[str, Any] = field(default_factory=dict, repr=False)

    @property
    def totallength(self) -> int:
        return self.multiseq.totallength

    @property
    def numofcodes(self) -> int:
        return (self.alpha.num_regular ** self.prefixlength
                if self.prefixlength > 0 else 0)

    @property
    def text(self) -> np.ndarray:
        return self.multiseq.sequence

    def device(self, name: str):
        """Return table ``name`` as a device array, cached."""
        import jax.numpy as jnp

        if name not in self._device_cache:
            host = {
                "text": self.text,
                "suftab": self.suftab,
                "lcptab": self.lcptab,
                "bwttab": self.bwttab,
                "stitab": self.stitab,
                "skptab": self.skptab,
            }[name]
            if host is None:
                raise ValueError(f"table {name} not built")
            self._device_cache[name] = jnp.asarray(host)
        return self._device_cache[name]
