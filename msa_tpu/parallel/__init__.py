from msa_tpu.parallel.schedule import lpt_schedule, pair_costs  # noqa: F401
from msa_tpu.parallel.mesh import get_mesh  # noqa: F401
from msa_tpu.parallel.engine import (  # noqa: F401
    align_kway_sharded,
    sharded_pair_scores,
)
