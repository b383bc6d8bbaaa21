from . import (circuits, cluster_matcher, color_code, compiler,  # noqa: F401
               decoders, dem, dem_decoder, erasure, executor,
               exact_matcher, fast_sampler, lattice_surgery, ldpc,
               ldpc_layout, memory, nn_decoder, pauli_frame, scheduler,
               surface_code, topology, window_matcher)
from .dem_decoder import DemBPDecoder  # noqa: F401
from .ldpc import run_bb_circuit_memory  # noqa: F401
from .erasure import run_erasure_memory  # noqa: F401
from .executor import execute  # noqa: F401
from .lattice_surgery import run_zz_surgery, zz_merge_split_circuit  # noqa: F401
from .fast_sampler import build_fast_sampler, sample_circuit_fast  # noqa: F401
from .memory import run_memory, MemoryResult  # noqa: F401
from .surface_code import memory_z_circuit, build_layout, code_metrics  # noqa: F401
from .exact_matcher import (exact_matcher_for_circuit,  # noqa: F401
                            tiered_matcher_for_circuit)
from .window_matcher import (window_matcher_for_circuit,  # noqa: F401
                             escalating_matcher_for_circuit)
from .cluster_matcher import cluster_matcher_for_circuit  # noqa: F401
