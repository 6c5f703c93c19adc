from .dataset import (
    DataBriefReportException,
    ItemProcessor,
    MetaDataset,
    T2IItemProcessor,
    resumable_sampler_indices,
)
from .imgproc import (
    center_crop,
    center_crop_arr,
    generate_crop_size_list,
    match_bucket,
    to_latent_input,
    var_center_crop,
)
from .loader import (
    batched,
    bucket_batched,
    collate_image_label,
    list_imagenet_folder,
    threaded_prefetch,
)

__all__ = [
    "MetaDataset", "ItemProcessor", "T2IItemProcessor", "DataBriefReportException",
    "resumable_sampler_indices",
    "generate_crop_size_list", "var_center_crop", "center_crop", "center_crop_arr",
    "match_bucket", "to_latent_input",
    "threaded_prefetch", "batched", "bucket_batched", "list_imagenet_folder",
    "collate_image_label",
]
