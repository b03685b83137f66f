from .quant import QuantizedTensor, quantize, dequantize, gather_rows, QK
from .linear import linear, set_pallas_mode

__all__ = ["QuantizedTensor", "quantize", "dequantize", "gather_rows", "QK",
           "linear", "set_pallas_mode"]
