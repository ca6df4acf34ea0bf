from .encoder import Encoder  # noqa: F401
from .state import EncoderState  # noqa: F401
