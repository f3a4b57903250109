"""Conditioning-mechanism configs (amortized / reconstruction guidance /
replacement).

Rebuilds `amortised diffusion/image_diffusion/conditioning.py:12-78` as
`flax.struct` dataclasses so they can be closed over by jitted samplers. The
sampler implementations live in `tpu_diffusion.sampling.ancestral` (the
reference dispatches on these types with `plum`; we dispatch with
`functools.singledispatch` on the same class hierarchy).
"""

from __future__ import annotations

from flax import struct


@struct.dataclass
class Conditioning:
    @classmethod
    def from_configdict(cls, config):
        return cls()


@struct.dataclass
class Amortized(Conditioning):
    """Condition concatenated as extra input channels; trained with
    condition dropout prob `p_cond`."""

    p_cond: float = 0.9
    n_corrector: int = struct.field(pytree_node=False, default=0)
    delta: float = 0.1

    @classmethod
    def from_configdict(cls, config):
        return cls(p_cond=config["p_cond"],
                   n_corrector=config["n_corrector"], delta=config["delta"])


@struct.dataclass
class ReconstructionGuidance(Conditioning):
    """Gradient of the likelihood loss through the x0-prediction."""

    gamma: float = 10.0
    start_fraction: float = struct.field(pytree_node=False, default=1.0)
    update_rule: str = struct.field(pytree_node=False, default="before")
    n_corrector: int = struct.field(pytree_node=False, default=0)
    delta: float = 0.1

    @classmethod
    def from_configdict(cls, config):
        return cls(gamma=config["gamma"],
                   start_fraction=config["start_fraction"],
                   update_rule=config["update_rule"],
                   n_corrector=config["n_corrector"], delta=config["delta"])


@struct.dataclass
class Replacement(Conditioning):
    """RePaint-style overwrite of observed pixels (optionally noised)."""

    delta: float = 0.1
    start_fraction: float = struct.field(pytree_node=False, default=1.0)
    noise: bool = struct.field(pytree_node=False, default=True)
    n_corrector: int = struct.field(pytree_node=False, default=0)

    @classmethod
    def from_configdict(cls, config):
        return cls(delta=config["delta"],
                   start_fraction=config["start_fraction"],
                   noise=config["noise"], n_corrector=config["n_corrector"])


CONDITIONINGS = {
    "amortized": Amortized,
    "reconstruction_guidance": ReconstructionGuidance,
    "replacement": Replacement,
}


def get_conditioning(name: str):
    """Factory (reference conditioning.py:64-78)."""
    key = name.lower()
    if key not in CONDITIONINGS:
        raise NotImplementedError(f"Unknown conditioning {name!r}")
    return CONDITIONINGS[key]
