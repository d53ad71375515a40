"""Lean dataset for EFT fitting: crop + keypoints + contact, no
augmentation.

Mirror of tuch/eft/dataset.py. Implemented as a thin specialization of
TuchDataset (the reference duplicates the crop/keypoint code); kept as its
own type so the EFT entry point matches the reference surface.
"""

from tuch_tpu.data.dataset import TuchDataset


class EFTDataset(TuchDataset):
    def __init__(self, options, dataset: str, **kwargs):
        kwargs.setdefault('use_augmentation', False)
        super().__init__(options, dataset, **kwargs)

    def get(self, index: int, epoch: int = 0):
        sample = super().get(index, epoch)
        # the reference's EFT batch exposes the contact vector as 'contact'
        sample['contact'] = sample['contact_vec']
        return sample
