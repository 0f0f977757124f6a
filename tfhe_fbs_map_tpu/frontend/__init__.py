from .bit_circuit import BitCircuit, BitNode, CONST0, CONST1
from .lut_program import LutProgram, LutNode, parse_lbf
from .mapping.basic import BasicMapper
from .mapping.heuristic import HeuristicMapper, map_best

__all__ = [
    "BitCircuit", "BitNode", "CONST0", "CONST1",
    "LutProgram", "LutNode", "parse_lbf",
    "BasicMapper", "HeuristicMapper", "map_best",
]
