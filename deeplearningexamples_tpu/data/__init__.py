from .prefetch import prefetch_to_device
from .synthetic import (
    SyntheticBertLoader,
    SyntheticDlrmLoader,
    SyntheticImageLoader,
)
