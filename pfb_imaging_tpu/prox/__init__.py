"""Proximal operators and regularisers (reference prox/).

Pure jittable kernels (prox_21m/prox_21/dual_update/positivity) plus the
stateful ``L21``/``L1`` Regulariser classes that own l1-reweighting state.
"""

from .l1 import L1  # noqa: F401
from .l21 import L21  # noqa: F401
from .positivity import positivity, positivity_band, positivity_prox  # noqa: F401
from .prox_21 import dual_update_21, prox_21  # noqa: F401
from .prox_21m import dual_update, prox_21m  # noqa: F401
from .prox2 import prox2  # noqa: F401
