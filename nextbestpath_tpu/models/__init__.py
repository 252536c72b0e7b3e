from .unet import NBP, nbp_loss
from .attention import Embedding, Encoder, FeedForward, MultiHeadSelfAttention, attention
from .scone import PCTransformer, SconeOcc, SconeVis, XEmbedding, coverage_gain, visibility_gains
from .harmonics import base_view_harmonics, harmonics_up_to_rank, spherical_harmonics
from .manydepth import ManyDepth, depth_to_disparity, disparity_to_depth
from .macarons import Macarons, macarons_optimizer
