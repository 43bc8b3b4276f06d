from .ntt import (  # noqa: F401
    COSET_SHIFT,
    coset_lde,
    eval_poly_ext_s,
    eval_polys_at_ext,
    intt,
    lde_from_values,
    ntt,
)
