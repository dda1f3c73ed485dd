from msa_tpu.utils.msaio import parse_input, format_output  # noqa: F401
from msa_tpu.utils.hashing import sha512_hex, pair_hash, chain_hashes  # noqa: F401
from msa_tpu.utils.alignment import (  # noqa: F401
    finish_alignment,
    moves_to_alignment,
)
from msa_tpu.utils.tasks import num_pairs, pair_tasks, task_id  # noqa: F401
