from .beam_search import beam_search
from .transformer import Transformer, TransformerConfig, TransformerTask
from .gnmt import Gnmt, GnmtConfig, GnmtTask
