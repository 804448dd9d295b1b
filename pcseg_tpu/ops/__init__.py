from pcseg_tpu.ops.batchnorm import (
    bn_param_init,
    bn_state_init,
    batchnorm_train,
    batchnorm_eval,
)
from pcseg_tpu.ops.pointwise import (
    dense_init,
    pointwise_dense,
    pointwise_block,
)
from pcseg_tpu.ops.pooling import global_max_pool
from pcseg_tpu.ops.losses import weighted_masked_cross_entropy
from pcseg_tpu.ops.metrics import (
    masked_accuracy,
    confusion_matrix,
    f1_from_confusion,
    F1Scores,
)
