from .adc import adc_scores, adc_scores_ref, adc_topk

__all__ = ['adc_scores', 'adc_scores_ref', 'adc_topk']
