from .wordpiece import WordPieceTokenizer, WordPieceVocab, normalize, pre_tokenize

__all__ = ["WordPieceTokenizer", "WordPieceVocab", "normalize", "pre_tokenize"]
