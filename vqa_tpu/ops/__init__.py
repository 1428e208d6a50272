from vqa_tpu.ops.cross_attention_kernel import (  # noqa: F401
    fused_cross_attention,
    xla_cross_attention,
)
from vqa_tpu.ops.se_kernel import fused_se, xla_se  # noqa: F401
from vqa_tpu.ops.stem_kernel import (  # noqa: F401
    fused_stem,
    pack_stem_weights,
    xla_stem,
)
