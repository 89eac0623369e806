from . import ast  # noqa: F401
from .parser import parse  # noqa: F401
