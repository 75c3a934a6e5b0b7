from rl4co_tpu.models.zoo.am import AttentionModelPolicy  # noqa: F401
from rl4co_tpu.models.zoo.pomo import POMO, make_pomo_policy  # noqa: F401
from rl4co_tpu.models.zoo.symnco import SymNCO, SymNCOPolicy  # noqa: F401
from rl4co_tpu.models.zoo.polynet import PolyNet, PolyNetPolicy  # noqa: F401
from rl4co_tpu.models.zoo.mvmoe import MVMoEPolicy  # noqa: F401
from rl4co_tpu.models.zoo.matnet import MatNetPolicy  # noqa: F401
from rl4co_tpu.models.zoo.mdam import MDAM, MDAMPolicy  # noqa: F401
from rl4co_tpu.models.zoo.nargnn import NARGNNEncoder, NonAutoregressivePolicy  # noqa: F401
from rl4co_tpu.models.zoo.deepaco import DeepACO, run_ant_system  # noqa: F401
from rl4co_tpu.models.zoo.gfacs import GFACS, GFACSEncoder  # noqa: F401
from rl4co_tpu.models.zoo.glop import GLOP, batched_random_insertion  # noqa: F401
from rl4co_tpu.models.zoo.dact import DACTPolicy, ImprovementCritic, dact_act  # noqa: F401
from rl4co_tpu.models.zoo.n2s import N2SPolicy, n2s_act  # noqa: F401
from rl4co_tpu.models.zoo.neuopt import NeuOptPolicy, neuopt_act  # noqa: F401
from rl4co_tpu.models.zoo.eas import ActiveSearch, EASEmb  # noqa: F401
from rl4co_tpu.models.zoo.ptrnet import PointerNetwork, PointerNetworkModel  # noqa: F401
from rl4co_tpu.models.zoo.l2d import L2DModel, L2DPolicy, l2d_rollout  # noqa: F401
