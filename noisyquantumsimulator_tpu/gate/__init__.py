from .simulate import *  # noqa: F401,F403
from .fidelity import *  # noqa: F401,F403
