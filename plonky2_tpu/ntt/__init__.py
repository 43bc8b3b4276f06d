from .ntt import (  # noqa: F401
    host_powers,
    COSET_SHIFT,
    coset_lde,
    eval_poly_ext_s,
    eval_polys_at_ext,
    intt,
    lde_from_values,
    lde_from_values_auto,
    lde_from_values_jit,
    ntt,
)
