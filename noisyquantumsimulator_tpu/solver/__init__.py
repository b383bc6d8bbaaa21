from .propagator import *  # noqa: F401,F403
from . import reference  # noqa: F401
