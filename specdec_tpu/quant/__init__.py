from specdec_tpu.quant.core import (
    Int8Weight,
    NF4Weight,
    quantize_int8,
    quantize_nf4,
    dequantize,
    quantize_params,
    qmatmul,
    NF4_CODEBOOK,
)
