"""graal_tpu — TPU-native Hi-C genome reassembly framework.

A from-scratch re-design of GRAAL (Marie-Nelly et al., Nat. Commun. 5:5695,
2014; reference implementation koszullab/GRAAL) for TPU hardware:

- the multiscale contact-map pyramid is built on the host and loaded as dense
  jnp matrices (``graal_tpu.io.pyramid``),
- the Rippe polymer contact model is fitted with least squares on the host and
  evaluated in fused dense kernels on the device (``graal_tpu.core.model``),
- the genome state is a pytree of int32 arrays; every structural mutation
  (eject, flip, split-insert, insert, swap-activity, translocation) is a pure
  vectorised function (``graal_tpu.core.ops``),
- candidate genomes are scored by a Poisson log-likelihood of the observed
  contact matrix against the model expectation, computed densely over all
  sub-fragment pairs (``graal_tpu.core.likelihood``, Pallas kernel in
  ``graal_tpu.ops``),
- one MCMC step — propose 13 mutations x k neighbours, score, sample, commit —
  is a single jitted function with no host round-trips
  (``graal_tpu.core.mcmc``),
- scale-out is mesh-based: contact-matrix rows sharded over a ``rows`` axis
  with psum likelihood reduction, independent annealing chains over a
  ``chains`` axis (``graal_tpu.parallel``).
"""

__version__ = "0.1.0"

# Lower closed-over device buffers as executable ARGUMENTS, not embedded
# HLO constants — required for the chr1-scale sparse buffers on
# relay-attached TPUs and a per-executable memory win everywhere
# (see utils/hoistconst.py for the full story).
from graal_tpu.utils import hoistconst as _hoistconst

_hoistconst.enable()

from graal_tpu.core.state import GenomeState  # noqa: F401
from graal_tpu.core.model import RippeParams  # noqa: F401
