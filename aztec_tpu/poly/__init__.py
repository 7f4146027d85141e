from .domain import EvaluationDomain
from . import fft as fft_ops
from .fft import fft, ifft, coset_fft, coset_ifft, fft_with_bitrev
