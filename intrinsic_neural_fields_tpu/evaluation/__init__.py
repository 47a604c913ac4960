from .metrics import psnr, epoch_psnr, dssim, structural_similarity
