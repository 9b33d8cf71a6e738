from vcvits_tpu.utils.masking import (  # noqa: F401
    sequence_mask,
    slice_segments,
    rand_slice_segments,
    kl_divergence,
)
