from . import constants, encoder, pyparser  # noqa: F401
from .constants import lsn_to_str, str_to_lsn  # noqa: F401
from .pyparser import ProtocolError, PyWalParser  # noqa: F401
