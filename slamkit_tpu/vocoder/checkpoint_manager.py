"""Textless checkpoint registry: name -> {url, fname, sha256}.

Counterpart of the reference's vendored textlesslib manager
(reference slamkit/vocoder/textless_checkpoint_manager/manager.py:17-61,
__init__.py:17-353): resolves public checkpoint names to files under
$TEXTLESS_CHECKPOINT_ROOT (default ~/.textless/), downloading with sha256
verification when the environment has egress. The registry mirrors the full
public table from textlesslib (50 checkpoints: HuBERT/mHuBERT dense models,
k-means quantizers 50-2000, Tacotron TTS, HiFi-GAN + Expresso variants, CPC,
waveglow).
"""
from __future__ import annotations

import hashlib
import os
import pathlib
import urllib.request
from dataclasses import dataclass
from typing import Union

@dataclass
class Checkpoint:
    name: str
    remote_path: str
    fname: str
    sha256: str


CHECKPOINTS = [
    Checkpoint("hubert-base-ls960",
               "https://dl.fbaipublicfiles.com/hubert/hubert_base_ls960.pt",
               "hubert_base_ls960.pt",
               "1703cf8d2cdc76f8c046f5f6a9bcd224e0e6caf4744cad1a1f4199c32cac8c8d"),
    Checkpoint("mhubert-base-vp_en_es_fr",
               "https://dl.fbaipublicfiles.com/hubert/mhubert_base_vp_en_es_fr_it3.pt",
               "mhubert_base_vp_en_es_fr_it3.pt",
               "23527cd6311a6617bfa199f574e2eed478cd6a58a634f4007165c10ec0019832"),
    Checkpoint("mhubert-base-vp_mls_cv_8lang",
               "https://dl.fbaipublicfiles.com/hubert/mhubert_base_vp_mls_cv_8lang_it3.pt",
               "mhubert_base_vp_mls_cv_8lang_it3.pt",
               "fa82eaccb557465f4732662e3a744c30c953059147ac6a4c92f1f3e0daeda61e"),
    Checkpoint("mhubert-base-25hz",
               "https://dl.fbaipublicfiles.com/textless_nlp/twist/speech_tokenizer/mhubert_base_25hz_cp_mls_cv_sp_fisher.pt",
               "mhubert_base_25hz_cp_mls_cv_sp_fisher.pt",
               "edf0f5be2581a568a236aeb2781a5607c5af25806e12f40f7f2391e861fe3cf0"),
    Checkpoint("hubert-base-ls960-kmeans-50",
               "https://dl.fbaipublicfiles.com/textless_nlp/gslm/hubert/km50/km.bin",
               "hubert_base_ls960_km50.pt",
               "d01a7d5bc2c54b7b5f25f321ba525b4d230b06e3927f90bad0394198bc89f494"),
    Checkpoint("hubert-base-ls960-kmeans-100",
               "https://dl.fbaipublicfiles.com/textless_nlp/gslm/hubert/km100/km.bin",
               "hubert_base_ls960_km100.pt",
               "f14a3104615485381fc489701d6761c9abbdbb0d43607cf55518a1e2891023fe"),
    Checkpoint("hubert-base-ls960-kmeans-200",
               "https://dl.fbaipublicfiles.com/textless_nlp/gslm/hubert/km200/km.bin",
               "hubert_base_ls960_km200.pt",
               "b3c46c9cdd1707ad852dd53c359aa73942e79d53c432a9a8a419ed046408024b"),
    Checkpoint("hubert-base-ls960-kmeans-500",
               "https://dl.fbaipublicfiles.com/textless_nlp/gslm/hubert/km500/km.bin",
               "hubert_base_ls960_km500.pt",
               "411c8668e1314751404f58636f935fc73540a6793890435da4a8ffadf157398e"),
    Checkpoint("mhubert-base-vp_en_es_fr-layer-11-kmeans-1000",
               "https://dl.fbaipublicfiles.com/hubert/mhubert_base_vp_en_es_fr_it3_L11_km1000.bin",
               "mhubert_base_vp_en_es_fr_it3_L11_km1000.bin",
               "c70f5416c38044d0c20e33fdeedf4533974a8ac4029985cdef3b755038381a0b"),
    Checkpoint("hubert-base-ls960-layer-9-kmeans-500",
               "https://dl.fbaipublicfiles.com/hubert/hubert_base_ls960_L9_km500.bin",
               "hubert_base_ls960_L9_km500.pt",
               "4450dcbc90aa7d0553306a4b0fafef35c9b3c840468f02969273dfbb9db89a23"),
    Checkpoint("hubert-base-ls960-layer-9-kmeans-expresso-2000",
               "https://dl.fbaipublicfiles.com/textless_nlp/expresso/checkpoints/hubert_base_ls960_L9_km2000_expresso.bin",
               "hubert_base_ls960_L9_km2000_expresso.pt",
               "ae73e3cc7ea0426faf43c8bb67fc3846a0f8708232526d045a101836e8c7929f"),
    Checkpoint("mhubert-base-vp_mls_cv_8lang-kmeans-2000",
               "https://dl.fbaipublicfiles.com/hubert/mhubert_base_vp_mls_cv_8lang_it3_L12_km2000.bin",
               "mhubert_base_vp_mls_cv_8lang_it3_L12_km2000.pt",
               "05de230870427dcdce334d29922ccce354c7e7d0574edc645f5daed47b1ccc18"),
    Checkpoint("mhubert-base-vp_mls_cv_8lang-kmeans-expresso-2000",
               "https://dl.fbaipublicfiles.com/textless_nlp/expresso/checkpoints/mhubert_base_vp_mls_cv_8lang_it3_L12_km2000_expresso.bin",
               "mhubert_base_vp_mls_cv_8lang_it3_L12_km2000_expresso.pt",
               "bda2dbf5fe42bf59359799b281498a9d7fd0a9ec703d6dc54a4a4a0ff70a4e22"),
    Checkpoint("mhubert-base-25hz-kmeans-500",
               "https://dl.fbaipublicfiles.com/textless_nlp/twist/speech_tokenizer/mhubert_base_25hz_cp_mls_cv_sp_fisher_L11_km500.bin",
               "mhubert_base_25hz_cp_mls_cv_sp_fisher_L11_km500.bin",
               "03cc04a9c24fec4285e73e709c485756d8f116aa8e724eac555de6a7cf8d28ad"),
    Checkpoint("hubert-base-ls960-kmeans-50-tacotron",
               "https://dl.fbaipublicfiles.com/textless_nlp/gslm/hubert/tts_km50/tts_checkpoint_best.pt",
               "hubert_base_ls960_kmeans_50_tacotron.pt",
               "335e881a897cfa3389804110de8ac3909159d4de395880fbf1d3167a9477451e"),
    Checkpoint("hubert-base-ls960-kmeans-100-tacotron",
               "https://dl.fbaipublicfiles.com/textless_nlp/gslm/hubert/tts_km100/tts_checkpoint_best.pt",
               "hubert_base_ls960_kmeans_100_tacotron.pt",
               "b208f8d6433eb5524405aa29d2b5fdacddb63a182d9830b629232e63b3543e4d"),
    Checkpoint("hubert-base-ls960-kmeans-200-tacotron",
               "https://dl.fbaipublicfiles.com/textless_nlp/gslm/hubert/tts_km200/tts_checkpoint_best.pt",
               "hubert_base_ls960_kmeans_200_tacotron.pt",
               "093f009935a4dadd692db85e859246e369cb17be3aecd22038fb70af4d5b0590"),
    Checkpoint("hubert-base-ls960-kmeans-50-tacotron-codes",
               "https://dl.fbaipublicfiles.com/textless_nlp/gslm/hubert/tts_km50/code_dict",
               "hubert_base_ls960_kmeans_50_tacotron_codes.pt",
               "5f01dd57fd3b4044fac93aaac2589bf49e34cbe1dc0713254c0f339ba2123bce"),
    Checkpoint("hubert-base-ls960-kmeans-100-tacotron-codes",
               "https://dl.fbaipublicfiles.com/textless_nlp/gslm/hubert/tts_km100/code_dict",
               "hubert_base_ls960_kmeans_100_tacotron_codes.pt",
               "6d506216aa5bad159f167e2535293b4e5ec8e1073b64449d30b66b460ebf6da0"),
    Checkpoint("hubert-base-ls960-kmeans-200-tacotron-codes",
               "https://dl.fbaipublicfiles.com/textless_nlp/gslm/hubert/tts_km200/code_dict",
               "hubert_base_ls960_kmeans_200_tacotron_codes.pt",
               "ea01ba3592e27c871b63b32e37d6532234edf7eee7077bdcc094061ee72922e6"),
    Checkpoint("mhubert-base-25hz-kmeans-500-hifigan",
               "https://dl.fbaipublicfiles.com/textless_nlp/twist/speech_tokenizer/hifigan_lj_mhubert_base_25hz.pt",
               "hifigan_lj_mhubert_base_25hz.pt",
               "d88224e95c501e2cd59a6e4014753169cfe060fb7ade3cc0da03c809fef73b79"),
    Checkpoint("mhubert-base-25hz-kmeans-500-hifigan-config",
               "https://dl.fbaipublicfiles.com/textless_nlp/twist/speech_tokenizer/hifigan_lj_mhubert_base_25hz_config.json",
               "hifigan_lj_mhubert_base_25hz_config.json",
               "116dc39be4970cd393e562acd0a0ec70a86aaba7e9ca469b8b836cb3fe46afc7"),
    Checkpoint("hubert-base-ls960-layer-9-kmeans-500-hifigan",
               "https://dl.fbaipublicfiles.com/textless_nlp/expresso/checkpoints/hifigan_expresso_lj_vctk_hubert_base_ls960_L9_km500/generator.pt",
               "hifigan_expresso_lj_vctk_hubert_base_ls960_L9_km500_generator.pt",
               "d50f4704e961c29cb386924ef32cd0c3a4d1089a3f9be856f8a3b6dcfdd6147a"),
    Checkpoint("hubert-base-ls960-layer-9-kmeans-500-hifigan-config",
               "https://dl.fbaipublicfiles.com/textless_nlp/expresso/checkpoints/hifigan_expresso_lj_vctk_hubert_base_ls960_L9_km500/config.json",
               "hifigan_expresso_lj_vctk_hubert_base_ls960_L9_km500_config.json",
               "31e65ef5e100cb43de08f2c8d225496ace1ed87a49fcb8ee44bd6805f079b1f0"),
    Checkpoint("hubert-base-ls960-layer-9-kmeans-500-hifigan-speakers",
               "https://dl.fbaipublicfiles.com/textless_nlp/expresso/checkpoints/hifigan_expresso_lj_vctk_hubert_base_ls960_L9_km500/speakers.txt",
               "hifigan_expresso_lj_vctk_hubert_base_ls960_L9_km500_speakers.txt",
               "2efabb7a4ad786da34fe6fbe99c3906b7abd40b2e01c81b7efde76142ae3d552"),
    Checkpoint("hubert-base-ls960-layer-9-kmeans-500-hifigan-styles",
               "https://dl.fbaipublicfiles.com/textless_nlp/expresso/checkpoints/hifigan_expresso_lj_vctk_hubert_base_ls960_L9_km500/styles.txt",
               "hifigan_expresso_lj_vctk_hubert_base_ls960_L9_km500_styles.txt",
               "a6f63206518448277c63c3a251ac13484784829cf2e1b0a23b0860dd32543520"),
    Checkpoint("hubert-base-ls960-layer-9-kmeans-expresso-2000-hifigan",
               "https://dl.fbaipublicfiles.com/textless_nlp/expresso/checkpoints/hifigan_expresso_lj_vctk_hubert_base_ls960_L9_km2000_expresso/generator.pt",
               "hifigan_expresso_lj_vctk_hubert_base_ls960_L9_km2000_expresso_generator.pt",
               "b892fdcca889f4bc6d7f0a0f407ae5d01eca8aaa66b9be333ef33a1c50f2ef52"),
    Checkpoint("hubert-base-ls960-layer-9-kmeans-expresso-2000-hifigan-config",
               "https://dl.fbaipublicfiles.com/textless_nlp/expresso/checkpoints/hifigan_expresso_lj_vctk_hubert_base_ls960_L9_km2000_expresso/config.json",
               "hifigan_expresso_lj_vctk_hubert_base_ls960_L9_km2000_expresso_config.json",
               "73932563cedc43cd1dcddfab36ce3b2c3cb76eef3423d25d1fb536ce1ec513bb"),
    Checkpoint("hubert-base-ls960-layer-9-kmeans-expresso-2000-hifigan-speakers",
               "https://dl.fbaipublicfiles.com/textless_nlp/expresso/checkpoints/hifigan_expresso_lj_vctk_hubert_base_ls960_L9_km2000_expresso/speakers.txt",
               "hifigan_expresso_lj_vctk_hubert_base_ls960_L9_km2000_expresso_speakers.txt",
               "2efabb7a4ad786da34fe6fbe99c3906b7abd40b2e01c81b7efde76142ae3d552"),
    Checkpoint("hubert-base-ls960-layer-9-kmeans-expresso-2000-hifigan-styles",
               "https://dl.fbaipublicfiles.com/textless_nlp/expresso/checkpoints/hifigan_expresso_lj_vctk_hubert_base_ls960_L9_km2000_expresso/styles.txt",
               "hifigan_expresso_lj_vctk_hubert_base_ls960_L9_km2000_expresso_styles.txt",
               "a6f63206518448277c63c3a251ac13484784829cf2e1b0a23b0860dd32543520"),
    Checkpoint("mhubert-base-vp_mls_cv_8lang-kmeans-2000-hifigan",
               "https://dl.fbaipublicfiles.com/textless_nlp/expresso/checkpoints/hifigan_expresso_lj_vctk_mhubert_base_vp_mls_cv_8lang_it3_L12_km2000/generator.pt",
               "hifigan_expresso_lj_vctk_mhubert_base_vp_mls_cv_8lang_it3_L12_km2000_generator.pt",
               "0d160c97519d3ed644e2ec636581b79e56767d60325308849fbb389a494c1466"),
    Checkpoint("mhubert-base-vp_mls_cv_8lang-kmeans-2000-hifigan-config",
               "https://dl.fbaipublicfiles.com/textless_nlp/expresso/checkpoints/hifigan_expresso_lj_vctk_mhubert_base_vp_mls_cv_8lang_it3_L12_km2000/config.json",
               "hifigan_expresso_lj_vctk_mhubert_base_vp_mls_cv_8lang_it3_L12_km2000_config.json",
               "73932563cedc43cd1dcddfab36ce3b2c3cb76eef3423d25d1fb536ce1ec513bb"),
    Checkpoint("mhubert-base-vp_mls_cv_8lang-kmeans-2000-hifigan-speakers",
               "https://dl.fbaipublicfiles.com/textless_nlp/expresso/checkpoints/hifigan_expresso_lj_vctk_mhubert_base_vp_mls_cv_8lang_it3_L12_km2000/speakers.txt",
               "hifigan_expresso_lj_vctk_mhubert_base_vp_mls_cv_8lang_it3_L12_km2000_speakers.txt",
               "2efabb7a4ad786da34fe6fbe99c3906b7abd40b2e01c81b7efde76142ae3d552"),
    Checkpoint("mhubert-base-vp_mls_cv_8lang-kmeans-2000-hifigan-styles",
               "https://dl.fbaipublicfiles.com/textless_nlp/expresso/checkpoints/hifigan_expresso_lj_vctk_mhubert_base_vp_mls_cv_8lang_it3_L12_km2000/styles.txt",
               "hifigan_expresso_lj_vctk_mhubert_base_vp_mls_cv_8lang_it3_L12_km2000_styles.txt",
               "a6f63206518448277c63c3a251ac13484784829cf2e1b0a23b0860dd32543520"),
    Checkpoint("mhubert-base-vp_mls_cv_8lang-kmeans-expresso-2000-hifigan",
               "https://dl.fbaipublicfiles.com/textless_nlp/expresso/checkpoints/hifigan_expresso_lj_vctk_mhubert_base_vp_mls_cv_8lang_it3_L12_km2000_expresso/generator.pt",
               "hifigan_expresso_lj_vctk_mhubert_base_vp_mls_cv_8lang_it3_L12_km2000_expresso_generator.pt",
               "8d1585f20edd9b0982f80acbb387a892adf19e4aa719b8dea795c8fa96285cbc"),
    Checkpoint("mhubert-base-vp_mls_cv_8lang-kmeans-expresso-2000-hifigan-config",
               "https://dl.fbaipublicfiles.com/textless_nlp/expresso/checkpoints/hifigan_expresso_lj_vctk_mhubert_base_vp_mls_cv_8lang_it3_L12_km2000_expresso/config.json",
               "hifigan_expresso_lj_vctk_mhubert_base_vp_mls_cv_8lang_it3_L12_km2000_expresso_config.json",
               "73932563cedc43cd1dcddfab36ce3b2c3cb76eef3423d25d1fb536ce1ec513bb"),
    Checkpoint("mhubert-base-vp_mls_cv_8lang-kmeans-expresso-2000-hifigan-speakers",
               "https://dl.fbaipublicfiles.com/textless_nlp/expresso/checkpoints/hifigan_expresso_lj_vctk_mhubert_base_vp_mls_cv_8lang_it3_L12_km2000_expresso/speakers.txt",
               "hifigan_expresso_lj_vctk_mhubert_base_vp_mls_cv_8lang_it3_L12_km2000_expresso_speakers.txt",
               "2efabb7a4ad786da34fe6fbe99c3906b7abd40b2e01c81b7efde76142ae3d552"),
    Checkpoint("mhubert-base-vp_mls_cv_8lang-kmeans-expresso-2000-hifigan-styles",
               "https://dl.fbaipublicfiles.com/textless_nlp/expresso/checkpoints/hifigan_expresso_lj_vctk_mhubert_base_vp_mls_cv_8lang_it3_L12_km2000_expresso/styles.txt",
               "hifigan_expresso_lj_vctk_mhubert_base_vp_mls_cv_8lang_it3_L12_km2000_expresso_styles.txt",
               "a6f63206518448277c63c3a251ac13484784829cf2e1b0a23b0860dd32543520"),
    Checkpoint("cpc-big-ll6k",
               "https://dl.fbaipublicfiles.com/textless_nlp/gslm/cpc/cpc_big_ll6kh_top_ctc.pt",
               "cpc_big_ll6kh_top_ctc.pt",
               "73155dad5d7c986fe7b7f548050060a8e9cc9a0ffd111a22932f38c3e617c5b8"),
    Checkpoint("cpc-big-ll6k-kmeans-50",
               "https://dl.fbaipublicfiles.com/textless_nlp/gslm/cpc/km50/km.bin",
               "cpc_big_ll6k_km50.pt",
               "c48be5717aebc08169aa5165d58267449b8c8568624a346bb9f4b26eac3b0240"),
    Checkpoint("cpc-big-ll6k-kmeans-100",
               "https://dl.fbaipublicfiles.com/textless_nlp/gslm/cpc/km100/km.bin",
               "cpc_big_ll6k_km100.pt",
               "077b96e010b1e87be627ef2bef0f5e5cdaa1c01722aa363b2dc0bb6a638e8b26"),
    Checkpoint("cpc-big-ll6k-kmeans-200",
               "https://dl.fbaipublicfiles.com/textless_nlp/gslm/cpc/km200/km.bin",
               "cpc_big_ll6k_km200.pt",
               "2d863d1c6f251d19e667998248c87642ecb5e3ffaa410e9ebfa64341db4f6de2"),
    Checkpoint("cpc-big-ll6k-kmeans-500",
               "https://dl.fbaipublicfiles.com/textless_nlp/gslm/cpc/km500/km.bin",
               "cpc_big_ll6k_km500.pt",
               "35398f665dff06801a7bf1e595bc176711ed751d554e64d999dc42f1dd106561"),
    Checkpoint("cpc-big-ll6k-kmeans-50-tacotron",
               "https://dl.fbaipublicfiles.com/textless_nlp/gslm/cpc/tts_km50/tts_checkpoint_best.pt",
               "cpc_big_ll6k_kmeans_50_tacotron.pt",
               "e80a46561d1ded73bbe6e7272fcd6b9943fb7607229040b06324f654b66396fd"),
    Checkpoint("cpc-big-ll6k-kmeans-100-tacotron",
               "https://dl.fbaipublicfiles.com/textless_nlp/gslm/cpc/tts_km100/tts_checkpoint_best.pt",
               "cpc_big_ll6k_kmeans_100_tacotron.pt",
               "6cfe1ce4bbdfd0f531189f4013cefc9e1296aec62f8bc0172d68d088ab344a50"),
    Checkpoint("cpc-big-ll6k-kmeans-200-tacotron",
               "https://dl.fbaipublicfiles.com/textless_nlp/gslm/cpc/tts_km200/tts_checkpoint_best.pt",
               "cpc_big_ll6k_kmeans_200_tacotron.pt",
               "5845b1c0a82d9176b9d8c33a32f098795c946077e741a9da2b665bafda17b7ff"),
    Checkpoint("cpc-big-ll6k-kmeans-50-tacotron-codes",
               "https://dl.fbaipublicfiles.com/textless_nlp/gslm/cpc/tts_km50/code_dict",
               "cpc_big_ll6k_kmeans_50_tacotron_codes.pt",
               "5f01dd57fd3b4044fac93aaac2589bf49e34cbe1dc0713254c0f339ba2123bce"),
    Checkpoint("cpc-big-ll6k-kmeans-100-tacotron-codes",
               "https://dl.fbaipublicfiles.com/textless_nlp/gslm/cpc/tts_km100/code_dict",
               "cpc_big_ll6k_kmeans_100_tacotron_codes.pt",
               "a343085a83c1acfc96a2bfecf5098b380e860cdbb832cbcbbb0bf1358bd7c932"),
    Checkpoint("cpc-big-ll6k-kmeans-200-tacotron-codes",
               "https://dl.fbaipublicfiles.com/textless_nlp/gslm/cpc/tts_km200/code_dict",
               "cpc_big_ll6k_kmeans_200_tacotron_codes.pt",
               "48dae50f9f2d4561c4a84fa09ba748395808d7d3323b1d5754af71669117e2aa"),
    Checkpoint("waveglow",
               "https://dl.fbaipublicfiles.com/textless_nlp/gslm/waveglow_256channels_standalone.pt",
               "waveglow_256channels_standalone.pt",
               "f383c7fd785502fc6a6bffd604fc14cb35d6155cdde30c53faaaeafa8a904dab"),
]


class CheckpointManager:
    def __init__(self, disk_root: Union[str, pathlib.Path] = None):
        if disk_root is None:
            disk_root = os.environ.get("TEXTLESS_CHECKPOINT_ROOT", "~/.textless/")
        self.disk_root = pathlib.Path(disk_root).expanduser().resolve()
        self.storage = {c.name: c for c in CHECKPOINTS}

    def set_root(self, new_root):
        self.disk_root = pathlib.Path(new_root).expanduser().resolve()

    def add_checkpoint(self, checkpoint: Checkpoint):
        self.storage[checkpoint.name] = checkpoint

    def download_by_name(self, name: str):
        ckpt = self.storage[name]
        self.disk_root.mkdir(parents=True, exist_ok=True)
        dst = self.disk_root / ckpt.fname
        # download to a temp name and rename AFTER hash verification, so an
        # interrupted transfer can never leave a corrupt file that later
        # passes the exists() check
        tmp = self.disk_root / (ckpt.fname + ".part")
        urllib.request.urlretrieve(ckpt.remote_path, tmp)
        if ckpt.sha256:
            h = hashlib.sha256(tmp.read_bytes()).hexdigest()
            if h != ckpt.sha256:
                tmp.unlink()
                raise IOError(f"sha256 mismatch for {name}: {h} != {ckpt.sha256}")
        tmp.replace(dst)

    def get_by_name(self, name: str, download_if_needed: bool = True) -> pathlib.Path:
        if name not in self.storage:
            raise KeyError(
                f"Unknown checkpoint {name!r}; add it via add_checkpoint "
                f"(full registry: textlesslib checkpoint manager)")
        ckpt = self.storage[name]
        disk_name = self.disk_root / ckpt.fname
        if not disk_name.exists():
            if not download_if_needed:
                raise FileNotFoundError(
                    f"Checkpoint {name} not found locally at {disk_name}")
            self.download_by_name(name)
        return disk_name


CHECKPOINT_MANAGER = CheckpointManager()
