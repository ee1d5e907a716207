from .registry import FunctionSet, build_function_set
from .trees import TreeTensors, EMPTY, CONST, OP_START
from .interpreter import evaluate_trees, make_candidate_evaluator
