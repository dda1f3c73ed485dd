from msa_tpu.models.pairwise import PairwiseAligner, align_pair  # noqa: F401
from msa_tpu.models.kway import KWayAligner, align_kway  # noqa: F401
