from .prefetch import background, prefetch_to_device
from .synthetic import (
    SyntheticBertLoader,
    SyntheticDlrmLoader,
    SyntheticImageLoader,
)
