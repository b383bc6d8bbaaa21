from . import (cavity_qed, laser, noise_rates, protocols, pulses,  # noqa: F401
               transport, trap, trapped_ions)
