"""CLI package.  The persistent-compile-cache path can emit C++-side
glog chatter (AOT cpu-feature advisories) on stderr; the CLIs'
stderr is part of the byte-parity contract with the reference
binaries, so silence it before anything can initialize XLA."""

import os as _os

_os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
