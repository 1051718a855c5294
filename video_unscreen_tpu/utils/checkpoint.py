"""Flax variable (params + batch_stats) checkpointing.

The reference loads torch `.pth` state dicts (`unscreen/binseg/agent.py:58`
etc.); this framework's native format is flax msgpack. `load_variables`
restores into a template tree so shape/dtype mismatches fail loudly.
"""

from __future__ import annotations

import os

import flax.serialization


def save_variables(path: str, variables) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(variables))


def load_variables(path: str, template):
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())
