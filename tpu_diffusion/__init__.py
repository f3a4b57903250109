"""tpu_diffusion — TPU-native diffusion + conditional flow matching framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
`VladimirRadenkovic/Image-inpainting-and-Super-Resolution-using-Diffusion-Models-
and-Conditional-Flow-Matching` (see SURVEY.md): conditional flow matching
(I-CFM / OT-CFM / Lipman FM / stochastic interpolants), amortised DDPM with
three conditioning mechanisms (amortized channel-concat, reconstruction
guidance, replacement) over inpainting / outpainting / super-resolution
likelihoods, and a protein C-alpha backbone diffusion stack with motif
scaffolding.

Conventions (deliberately different from the torch reference):
  * images are NHWC (TPU conv layout), not NCHW;
  * every random op takes an explicit `jax.random` key;
  * samplers are jitted `lax.scan` loops, never Python step loops;
  * parallelism is a `jax.sharding.Mesh` + NamedSharding, never DataParallel.
"""

__version__ = "0.1.0"
