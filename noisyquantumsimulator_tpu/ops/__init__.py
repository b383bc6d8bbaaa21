from . import expm, hamiltonians, hilbert, lindblad  # noqa: F401
