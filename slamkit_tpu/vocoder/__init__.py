from .audio_vocoder import AudioVocoder, vocoder_factory

__all__ = ["AudioVocoder", "vocoder_factory"]
