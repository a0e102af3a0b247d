from smpl_nerf_tpu.evaluation.scores import (img2mse, img2psnr, ssim,  # noqa: F401
                                             lpips, rlpips, print_scores)
