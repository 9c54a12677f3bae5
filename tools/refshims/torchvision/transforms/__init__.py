from . import functional
from .functional import InterpolationMode
