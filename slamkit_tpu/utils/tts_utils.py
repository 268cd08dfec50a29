"""TTS helpers (reference slamkit/utils/tts_utils.py:38-95).

FastSpeech2 (fairseq hub) with word-level time alignment extracted from the
decoder attention, and the Kokoro pipeline helper. Both depend on optional
packages (fairseq / g2p_en / kokoro) imported lazily — environments without
them get a clear ImportError at call time, not import time."""
from __future__ import annotations

from typing import Generator, List, Optional


class FastSpeech2:
    """facebook/fastspeech2-en-ljspeech wrapper that also extracts word-level
    alignment from attention (reference tts_utils.py:6-78)."""

    def __init__(self, cache_dir: Optional[str] = None, save_sr: int = 16000,
                 eos_padding: int = 30):
        import torch
        from fairseq.checkpoint_utils import \
            load_model_ensemble_and_task_from_hf_hub
        from fairseq.models.text_to_speech.hub_interface import TTSHubInterface
        import g2p_en

        models, cfg, self.task = load_model_ensemble_and_task_from_hf_hub(
            "facebook/fastspeech2-en-ljspeech",
            arg_overrides={"vocoder": "hifigan", "fp16": False},
            cache_dir=cache_dir)
        self.sr = self.task.sr
        self.save_sr = save_sr
        self.eos_padding = eos_padding
        self.device = torch.device("cuda" if torch.cuda.is_available() else "cpu")
        self.g2p = g2p_en.G2p()
        self.model = models[0].to(self.device)
        TTSHubInterface.update_cfg_with_data_cfg(cfg, self.task.data_cfg)
        self.generator = self.task.build_generator(models, cfg)

    def generate_wav(self, text: str, alignment: bool = False):
        import torch
        from fairseq.models.text_to_speech.hub_interface import TTSHubInterface

        sample = TTSHubInterface.get_model_input(self.task, text)
        sample["net_input"]["src_tokens"] = sample["net_input"]["src_tokens"].to(self.device)
        sample["net_input"]["src_lengths"] = sample["net_input"]["src_lengths"].to(self.device)
        output = self.generator.generate(self.model, sample)
        if not alignment:
            return output
        attn = output[0]["attn"]
        current_index = 1
        aligned = []
        for word in text.split():
            phonemes = [{",": "sp", ";": "sp"}.get(p, p) for p in self.g2p(word)]
            phonemes = [c for c in phonemes if c.isalnum()]
            first, last = current_index, current_index + len(phonemes) - 1
            idx = (torch.tensor((first, last), dtype=torch.float32,
                                device=self.device).unsqueeze(1) == attn
                   ).nonzero(as_tuple=True)[1]
            aligned.append((" " + word,
                            round((idx[0].item() * 256) / self.sr, 3),
                            round((idx[-1].item() * 256) / self.sr, 3)))
            current_index += len(phonemes)
        return output, aligned


def kokoro(texts: List[str], voice: str = "af_heart", speed: int = 1) -> Generator:
    """hexgrad/Kokoro-82M pipeline helper (reference tts_utils.py:81-95)."""
    from kokoro import KPipeline

    pipeline = KPipeline(lang_code=voice[0])
    return pipeline(texts, voice=voice, speed=speed)
