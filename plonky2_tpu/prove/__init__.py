from .compile import compile_circuit, CircuitData  # noqa: F401
from .prover import prove  # noqa: F401
from .verifier import verify  # noqa: F401
