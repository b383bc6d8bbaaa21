from .constants import *  # noqa: F401,F403
from .atom_data import *  # noqa: F401,F403
from .configs import *  # noqa: F401,F403
