"""Classes for parametrization of sequences."""

from pulser_tpu.parametrized.paramabc import Parametrized
from pulser_tpu.parametrized.paramobj import ParamObj
from pulser_tpu.parametrized.variable import Variable, VariableItem

__all__ = ["Parametrized", "ParamObj", "Variable", "VariableItem"]
