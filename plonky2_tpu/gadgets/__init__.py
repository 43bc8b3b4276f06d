# Gadget modules attach their APIs onto CircuitBuilder at import (the
# Python analogue of the reference's extension traits, e.g.
# CircuitBuilderB32 at /root/reference/src/u32/interleaved_u32.rs:19).
from . import u32  # noqa: F401
from . import biguint  # noqa: F401
from . import nonnative  # noqa: F401
