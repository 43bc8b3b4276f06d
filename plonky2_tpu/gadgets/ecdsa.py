"""In-circuit ECDSA signature verification over secp256k1.

Parity surface: /root/reference/src/ecdsa/gadgets/ecdsa.rs:56-191 —
`ECDSASignatureTarget`/`ECDSAPublicKeyTarget`, `verify_message_circuit`
(pk validity, c = s^-1, u1 = m*c, u2 = r*c, P = u1*G (fixed-base) +
u2*pk (GLV), r == P.x) and `batch_verify_message_circuit`.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..field import secp
from ..ir.builder import CircuitBuilder
from .curve import AffinePointTarget
from .nonnative import NonNativeTarget


@dataclass
class ECDSASignatureTarget:
    r: NonNativeTarget      # mod N
    s: NonNativeTarget      # mod N


@dataclass
class ECDSAPublicKeyTarget:
    point: AffinePointTarget


def add_virtual_ecdsa_signature_target(self) -> ECDSASignatureTarget:
    return ECDSASignatureTarget(self.add_virtual_nonnative_target(secp.N),
                                self.add_virtual_nonnative_target(secp.N))


def verify_message_circuit(self, msg: NonNativeTarget,
                           sig: ECDSASignatureTarget,
                           pk: ECDSAPublicKeyTarget) -> None:
    """(ecdsa.rs:138-161)."""
    assert msg.modulus == secp.N
    self.curve_assert_valid(pk.point)
    c = self.inv_nonnative(sig.s)
    u1 = self.mul_nonnative(msg, c)
    u2 = self.mul_nonnative(sig.r, c)
    point1 = self.fixed_base_curve_mul(secp.G, u1)
    point2 = self.glv_mul(pk.point, u2)
    point = self.curve_add(point1, point2)
    # r == point.x as limb values (same simplification as the reference:
    # ignores the negligible r >= |x mod N| wraparound edge)
    x_as_scalar = NonNativeTarget(point.x.value, secp.N)
    self.connect_nonnative(sig.r, x_as_scalar)


def batch_verify_message_circuit(self, msgs: list, sigs: list, pks: list) -> None:
    """(ecdsa.rs:163-191)."""
    for m, s, p in zip(msgs, sigs, pks):
        self.verify_message_circuit(m, s, p)


_EXCLUDE = {"ECDSASignatureTarget", "ECDSAPublicKeyTarget",
            "AffinePointTarget", "NonNativeTarget", "CircuitBuilder",
            "dataclass", "annotations", "secp"}
for _name, _fn in list(globals().items()):
    if callable(_fn) and not _name.startswith("_") and _name not in _EXCLUDE:
        setattr(CircuitBuilder, _name, _fn)
