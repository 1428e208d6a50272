from vqa_tpu.models.attention_modules import (  # noqa: F401
    AttentionWrapper,
    CBAMBlock,
    SEAttention,
    SelfAttention2D,
    SpatialAttention,
)
from vqa_tpu.models.cnn_backbone import (  # noqa: F401
    ConvBlock,
    CustomResNet,
    ResidualBlock,
    ResidualStage,
    create_cnn_backbone,
)
from vqa_tpu.models.cross_attention import (  # noqa: F401
    CrossAttention,
    MultiHeadCrossAttention,
    StackedCrossAttention,
)
from vqa_tpu.models.fusion import (  # noqa: F401
    GatingMechanism,
    ImageFeatureProjector,
    MultimodalFusion,
)
from vqa_tpu.models.text_encoder import (  # noqa: F401
    FeedForwardNetwork,
    MultiHeadSelfAttention,
    PositionalEncoding,
    TransformerEncoderLayer,
    TransformerTextEncoder,
)
from vqa_tpu.models.vqa_model import (  # noqa: F401
    AnswerHead,
    VQAModel,
    count_parameters,
    forward_logits,
    create_vqa_model,
    get_attention_maps,
    init_vqa_model,
    predict_topk,
)
