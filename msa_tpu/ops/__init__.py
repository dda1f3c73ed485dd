from msa_tpu.ops.reference import (  # noqa: F401
    nw_dp_matrix,
    nw_dirs,
    nw_align_numpy,
    nw_score_numpy,
)
