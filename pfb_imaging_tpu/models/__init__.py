"""Sky-model representations: component-coefficient models (.mds analogue),
synthetic transients for hci injection, spectral-index fitting."""

from .transients import transient_spectrum  # noqa: F401
