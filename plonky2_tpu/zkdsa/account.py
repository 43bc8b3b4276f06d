"""zkDSA accounts: toy Poseidon keypairs and 1-element addresses.

Parity: /root/reference/src/zkdsa/account.rs — `Address<F>(F)` with
0x-prefixed big-endian-u64 hex serde (:62-117), `to_hash_out/from_hash_out/
read/write` (:127-156), `public_key = Poseidon_two_to_one(sk, sk)`,
`address = pk.elements[0]` (:164-170), `Account` (:230-251).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..field import gl
from ..hashes import poseidon
from ..smt.hash_out import HashOut, ZERO_HASH

SecretKey = HashOut
PublicKey = HashOut


@dataclass(frozen=True)
class Address:
    value: int          # one Goldilocks element

    def to_hex(self) -> str:
        """0x-prefixed big-endian hex of the canonical u64."""
        return "0x" + int(self.value).to_bytes(8, "big").hex()

    @classmethod
    def from_hex(cls, s: str) -> "Address":
        assert s.startswith("0x"), f"missing 0x prefix: {s}"
        raw = bytes.fromhex(s[2:].zfill(16) if len(s) - 2 < 16 else s[2:])
        assert len(raw) <= 8, "too long hexadecimal sequence"
        v = int.from_bytes(raw, "big")
        assert v < gl.P
        return cls(v)

    def to_hash_out(self) -> HashOut:
        return (self.value, 0, 0, 0)

    @classmethod
    def from_hash_out(cls, h: HashOut) -> "Address":
        assert h[1] == 0 and h[2] == 0 and h[3] == 0
        return cls(h[0])

    @classmethod
    def read(cls, it) -> "Address":
        v = next(it)
        for _ in range(3):
            next(it)
        return cls(v)

    def write(self, out: list) -> None:
        out.append(self.value)
        out.extend([0, 0, 0])

    def __str__(self) -> str:
        return self.to_hex()


def private_key_to_public_key(private_key: SecretKey) -> PublicKey:
    return tuple(poseidon.two_to_one_s(list(private_key),
                                       list(private_key)))


def public_key_to_address(public_key: PublicKey) -> Address:
    return Address(public_key[0])


@dataclass(frozen=True)
class Account:
    private_key: SecretKey
    public_key: PublicKey
    address: Address

    @classmethod
    def new(cls, private_key: SecretKey) -> "Account":
        return private_key_to_account(private_key)


def private_key_to_account(private_key: SecretKey) -> Account:
    public_key = private_key_to_public_key(private_key)
    return Account(private_key, public_key,
                   public_key_to_address(public_key))


def sign_message(private_key: SecretKey, message: HashOut) -> HashOut:
    """signature = Poseidon_two_to_one(sk, msg) (the toy scheme the
    SimpleSignature circuit proves; gadgets/signature/mod.rs:53-68)."""
    return tuple(poseidon.two_to_one_s(list(private_key), list(message)))
