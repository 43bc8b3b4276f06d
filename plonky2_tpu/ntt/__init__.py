from .ntt import ntt, intt, coset_lde, lde_from_values, COSET_SHIFT  # noqa: F401
