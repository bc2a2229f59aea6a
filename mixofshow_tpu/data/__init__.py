from mixofshow_tpu.data.lora_dataset import LoraDataset
from mixofshow_tpu.data.prompt_dataset import PromptDataset
from mixofshow_tpu.data.loader import DataLoader, TrainBatcher
from mixofshow_tpu.data.pil_transform import PairCompose, build_transform

__all__ = ['LoraDataset', 'PromptDataset', 'DataLoader', 'TrainBatcher',
           'PairCompose', 'build_transform']
