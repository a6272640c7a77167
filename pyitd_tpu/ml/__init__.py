"""Adjacent ML research components (SURVEY.md §2.3), JAX/flax-native."""
from .activations import rainstar
from .optimizers import wolf, phoenix
from .layers import ITDLinear, ITDMLP, VanillaMLP, ITDRNNForecaster
from .parseval import (
    variance_scaled_softmax,
    build_haar_wavelet_basis,
    SingleHeadWaveletAttention,
    UnitaryAncillaAttention,
    AnchorModule,
    GPTConfig,
    ParsevalGPT,
    softcap,
)
from .moe import (
    BiMLP,
    LinearBilinear,
    ModCRTMoE,
    capacity_dispatch,
    router_topk,
    FastLearnedCellX3,
)
from .checkpoint import save_state, restore_state
from .ultramem import UltraMemCfg, UltraMemClassifier
from .vte import (
    dynmix,
    pairwise_rot_spiral,
    spiral_mix,
    phase_tap,
    phase_transport,
    subspace_iteration,
    frft_time,
    ManifoldStage,
    AutoencoderBlock,
    BlockFastGPT,
)
from .tape import (
    RectifiedKAN,
    CachedMultiheadAttention,
    TapeHeadBlock,
    MLayer,
    LieMLayer,
)
from .newgpt import WedgeTransform, convex_softmax, AlpertQueryGenerator, ExplorerEngineerStage
from .phase import add_hypersphere_phase_heads, PhaseHeads, Mixer
from .kalman import KalmanSweepMHGains
from .blockfast import (
    circular_student_t,
    MOEMLP,
    BlockFastBlock,
    BlockFastLM,
    blockfast_init_state,
    blockfast_step,
)
from .zoo import RecurrentMLP, fixed_embedding, UnigramModel, BatchSampler
from .visualizer import MatrixDashboard

__all__ = [
    "rainstar", "wolf", "phoenix",
    "ITDLinear", "ITDMLP", "VanillaMLP", "ITDRNNForecaster",
    "variance_scaled_softmax", "build_haar_wavelet_basis",
    "SingleHeadWaveletAttention", "UnitaryAncillaAttention", "AnchorModule",
    "GPTConfig", "ParsevalGPT", "softcap",
    "BiMLP", "LinearBilinear", "ModCRTMoE", "capacity_dispatch",
    "router_topk", "FastLearnedCellX3", "save_state", "restore_state",
    "UltraMemCfg", "UltraMemClassifier",
    "pairwise_rot_spiral", "spiral_mix", "phase_tap", "phase_transport",
    "subspace_iteration", "frft_time", "ManifoldStage", "AutoencoderBlock",
    "BlockFastGPT",
    "RectifiedKAN", "CachedMultiheadAttention", "TapeHeadBlock",
    "MLayer", "LieMLayer",
    "WedgeTransform", "convex_softmax", "AlpertQueryGenerator", "ExplorerEngineerStage", "dynmix",
    "add_hypersphere_phase_heads", "PhaseHeads", "Mixer", "KalmanSweepMHGains",
    "circular_student_t", "MOEMLP", "BlockFastBlock", "BlockFastLM",
    "blockfast_init_state", "blockfast_step",
    "RecurrentMLP", "fixed_embedding", "UnigramModel", "BatchSampler",
    "MatrixDashboard",
]
