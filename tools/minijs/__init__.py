"""Mini-JS engine + browser shims to execute the reference GTM player
unmodified inside the (node-less) test environment."""
from .engine import Interpreter, parse_with_asi  # noqa: F401
