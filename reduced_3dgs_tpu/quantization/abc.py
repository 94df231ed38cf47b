"""Quantizer abstractions.

Mirrors /root/reference/reduced_3dgs/quantization/abc.py: AbstractQuantizer
(quantize/dequantize/save_quantized/load_quantized) and
QuantizeTrainerWrapper, whose `model` property quantizes+dequantizes the live
parameters in place every `quantize_interval` steps inside
[quantize_from_iter, quantize_until_iter] so training is codebook-aware
(abc.py:43-49).
"""
from __future__ import annotations

import abc
from typing import Dict, Tuple

from ..trainer import AbstractTrainer, TrainerWrapper


class AbstractQuantizer(abc.ABC):

    @abc.abstractmethod
    def quantize(self, model, update_codebook: bool = True) -> Tuple[Dict, Dict]:
        ...

    @abc.abstractmethod
    def dequantize(self, model, ids_dict: Dict, codebook_dict: Dict,
                   xyz=None, replace: bool = False):
        ...

    @abc.abstractmethod
    def save_quantized(self, model, ply_path: str):
        ...

    @abc.abstractmethod
    def load_quantized(self, model, ply_path: str):
        ...


class QuantizeTrainerWrapper(TrainerWrapper):

    def __init__(self, base_trainer: AbstractTrainer,
                 quantizer: AbstractQuantizer,
                 quantize_from_iter: int = 5000,
                 quantize_until_iter: int = 30000,
                 quantize_interval: int = 1000):
        super().__init__(base_trainer)
        self.quantizer = quantizer
        self.quantize_from_iter = quantize_from_iter
        self.quantize_until_iter = quantize_until_iter
        self.quantize_interval = quantize_interval

    @property
    def model(self):
        if (self.quantize_from_iter <= self.curr_step <= self.quantize_until_iter
                and self.curr_step % self.quantize_interval == 0):
            model = self.base_trainer.model
            ids_dict, codebook_dict = self.quantizer.quantize(
                model, update_codebook=True)
            return self.quantizer.dequantize(model, ids_dict, codebook_dict)
        return self.base_trainer.model

    def fires_at(self, step: int) -> bool:
        # The model-property hook fires when a step STARTS with curr_step
        # at a quantize boundary — the same interior-step set that
        # AbstractTrainer.max_window excludes.
        return ((self.quantize_from_iter <= step <= self.quantize_until_iter
                 and step % self.quantize_interval == 0)
                or super().fires_at(step))
