from .buffer import Buffer  # noqa: F401
from .serde import (gate_from_key,  # noqa: F401
                    deserialize_proof, deserialize_verifier_data,
                    serialize_proof, serialize_verifier_data)
from .prover_serde import (deserialize_prover_data,  # noqa: F401
                           serialize_prover_data)
