from .base import BatchAlg, EvalVars, ExtAlg, Gate  # noqa: F401
from .arithmetic import ArithmeticGate  # noqa: F401
from .simple import ConstantGate, NoopGate, PublicInputGate  # noqa: F401
from .poseidon_gate import PoseidonGate  # noqa: F401
from .poseidon2_gate import Poseidon2Gate  # noqa: F401
from .random_access import RandomAccessGate  # noqa: F401
from .comparison import ComparisonGate, U32SubtractionGate  # noqa: F401
from .exponentiation import ExponentiationGate  # noqa: F401
from .extension import (ArithmeticExtensionGate, MulExtensionGate,  # noqa: F401
                        ReducingExtensionGate, ReducingGate)
from .coset_interpolation import CosetInterpolationGate  # noqa: F401
from .lookup import LookupGate, LookupTableGate  # noqa: F401
