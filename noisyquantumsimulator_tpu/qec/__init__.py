from . import circuits, decoders, dem, memory, pauli_frame, surface_code  # noqa: F401
from .memory import run_memory, MemoryResult  # noqa: F401
from .surface_code import memory_z_circuit, build_layout, code_metrics  # noqa: F401
