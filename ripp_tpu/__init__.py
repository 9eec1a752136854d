"""ripp-tpu: TPU-native inner pairing product proof framework.

From-scratch JAX/XLA implementation of the capabilities of arkworks-rs/ripp
(see SURVEY.md): BLS12 field towers and pairings as limb-sliced kernels,
Pippenger MSM, doubly homomorphic commitments, GIPA/TIPA/SIPP arguments,
Groth16 aggregation and two-tier polynomial commitments.
"""

from .utils import jaxcfg as _jaxcfg

_jaxcfg.setup()

__version__ = "0.1.0"
