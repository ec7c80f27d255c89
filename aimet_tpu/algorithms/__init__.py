from .bn_fold import bn_affine_params, find_foldable_pairs, fold_all_batch_norms
from .cle import equalize_model, find_cls_sets, high_bias_fold, scale_cls_sets
from .bias_correction import correct_bias
from .adaround import AdaroundParameters, apply_adaround
from .seq_mse import apply_seq_mse
from .amp import Candidate, GreedyMixedPrecision, choose_mixed_precision, find_quantizer_groups
from .auto_quant import AutoQuant, AutoQuantResult
from .quant_analyzer import QuantAnalyzer, QuantAnalyzerResult
from .bn_reestimation import reestimate_bn_stats
from .arch_checker import ArchChecker, ModelValidator
from .gptq import GPTVQParameters, apply_gptq, apply_gptvq
from .peft import LoraConfig, PeftQuantUtils, init_lora_params, lora_apply_fn
from .bias_correction import correct_bias_analytical
from .auto_quant import AutoQuantWithAutoMixedPrecision
from .smooth_quant import (SmoothTarget, apply_smooth_quant,
                           compute_smoothing_scales, find_smooth_targets)
