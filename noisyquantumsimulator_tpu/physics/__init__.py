from . import laser, noise_rates, protocols, pulses, trap  # noqa: F401
