"""Configuration system.

The reference had no flags at all — its config surfaces were compile-time
constants (``n_threads = 16`` at ``submit/xuliny-seqalkway.cpp:94``, the
``*8`` tile fudge at ``submit:452``) and Slurm environment (SURVEY.md §5).
Here every tunable is an explicit dataclass field, overridable from the CLI
and from environment variables prefixed ``MSA_TPU_``.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional


@dataclasses.dataclass
class EngineConfig:
    # Pairwise backend: numpy | native | jax | pallas | auto
    backend: str = "auto"
    # Fill-kernel band height for the score-only path (lanes per step).
    score_rb: int = 32768
    # Band height for the alignment path (v_len pinned to 16384 there).
    align_rb: int = 16256
    # Below this m*n, pairs run on the jnp full-dirs path instead of the
    # banded Pallas fill + walk.
    small_threshold: int = 1 << 21
    # Bucket quantum for padded shapes (bounds recompilation).
    bucket_quantum: int = 256
    # Max supported sequence length (shapes are capped to this).
    max_seq_len: int = 100_352
    # Mesh axis sizes; None = all local devices on one axis.
    mesh_pairs: Optional[int] = None
    # Emit jax profiler traces to this directory when set.
    profile_dir: Optional[str] = None

    @classmethod
    def from_env(cls, **overrides) -> "EngineConfig":
        cfg = cls(**overrides)
        for f in dataclasses.fields(cls):
            env = os.environ.get(f"MSA_TPU_{f.name.upper()}")
            if env is not None:
                val = env if f.type == "str" else int(env)
                setattr(cfg, f.name, val)
        return cfg


DEFAULT = EngineConfig()
