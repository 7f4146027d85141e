from .bigint import (
    int_to_limbs,
    ints_to_limbs,
    limbs_to_int,
    limbs_to_ints,
    bytes_to_limbs,
    limbs_to_bytes,
    LIMB_BITS,
    NLIMBS,
)
