#!/usr/bin/env Rscript
# R-parity kit (one half of the BASELINE north-star loop: "matches R outputs
# to 1e-5 in R^2").  No R runtime exists in the build container, so this
# script is the EXPORTABLE half: run it on any machine with R + fields (and
# optionally gbm/randomForest/earth/MACHISPLIN), and it writes
# tools/r_parity.json; the pytest twin (tests/test_r_parity.py) then asserts
# machisplin_tpu against those numbers whenever the JSON is present.
#
# Usage:
#   Rscript tools/r_parity.R [sampling_csv] [out_json] [covar_dir]
#
# - sampling_csv: the bundled 813-station table (default
#   machisplin_tpu/data/sampling.csv — identical to the reference's
#   data-raw/sampling.csv).
# - covar_dir: optional directory holding alt.tif / slope.tif / TWI.tif; when
#   given AND the MACHISPLIN package is installed, the full machisplin.mltps
#   run is recorded too (summary R^2 per layer).
#
# Everything in the "tps" block is DETERMINISTIC (fields::Tps has no RNG), so
# the python side can assert at 1e-5.  Model-zoo blocks are seeded but
# RNG-coupled, so the python side uses statistical tolerances.

suppressMessages({
  ok_jsonlite <- requireNamespace("jsonlite", quietly = TRUE)
  ok_fields <- requireNamespace("fields", quietly = TRUE)
})
if (!ok_jsonlite || !ok_fields) {
  stop("need install.packages(c('jsonlite','fields'))")
}

args <- commandArgs(trailingOnly = TRUE)
csv <- if (length(args) >= 1) args[1] else "machisplin_tpu/data/sampling.csv"
out <- if (length(args) >= 2) args[2] else "tools/r_parity.json"
covar_dir <- if (length(args) >= 3) args[3] else NA

d <- read.csv(csv)
result <- list(
  meta = list(
    r_version = as.character(getRversion()),
    fields_version = as.character(packageVersion("fields")),
    n = nrow(d)
  )
)

# ---- deterministic leg: fields::Tps on the raw station values -------------
# (the exact call shape of mltps part 3, V73:722/751, applied to the raw
# responses so no RNG-dependent ensemble sits upstream)
result$tps <- list()
for (col in c("bio_1", "bio_12")) {
  fit <- fields::Tps(cbind(d$long, d$lat), d[[col]])
  pred <- fields::predict.Krig(fit)[, 1]
  y <- d[[col]]
  r2 <- 1 - sum((y - pred)^2) / sum((y - mean(y))^2)
  result$tps[[col]] <- list(
    lambda = fit$lambda,
    eff_df = fit$eff.df,
    gcv = min(fit$gcv.grid[, "GCV"], na.rm = TRUE),
    r2_fitted = r2,
    fitted_head = round(pred[1:20], 6),
    residual_rms = sqrt(mean((y - pred)^2))
  )
}

# ---- seeded model-zoo statistics (statistical parity only) ----------------
seeded <- function(expr) { set.seed(20260817); expr }
zoo <- list()
if (requireNamespace("randomForest", quietly = TRUE)) {
  rf <- seeded(randomForest::randomForest(
    x = cbind(long = d$long, lat = d$lat), y = d$bio_1
  ))
  zoo$rf_bio1_oob_r2 <- 1 - mean((rf$predicted - d$bio_1)^2) / var(d$bio_1)
}
if (requireNamespace("earth", quietly = TRUE)) {
  em <- seeded(earth::earth(bio_1 ~ long + lat, data = d))
  zoo$mars_bio1_rsq <- em$rsq
  zoo$mars_bio1_nterms <- nrow(em$dirs)
}
if (requireNamespace("kernlab", quietly = TRUE)) {
  sv <- seeded(kernlab::ksvm(bio_1 ~ long + lat, data = d))
  pr <- kernlab::predict(sv, d)
  zoo$svm_bio1_r2 <- 1 - sum((d$bio_1 - pr)^2) / sum((d$bio_1 - mean(d$bio_1))^2)
}
if (requireNamespace("mgcv", quietly = TRUE)) {
  gm <- mgcv::gam(bio_1 ~ long + lat, data = d)   # the degenerate no-s() form
  zoo$gam_bio1_coefs <- as.numeric(coef(gm))
}
result$zoo <- zoo

# ---- optional: the full reference pipeline --------------------------------
if (!is.na(covar_dir) && requireNamespace("MACHISPLIN", quietly = TRUE) &&
    requireNamespace("terra", quietly = TRUE)) {
  alt <- terra::rast(file.path(covar_dir, "alt.tif"))
  slope <- terra::rast(file.path(covar_dir, "slope.tif"))
  twi <- terra::rast(file.path(covar_dir, "TWI.tif"))
  set.seed(20260817)
  omega <- MACHISPLIN::machisplin.mltps(
    int.values = d, covar.ras = c(alt, slope, twi)
  )
  result$mltps <- lapply(omega[1:(length(omega))], function(l) l$summary)
}

jsonlite::write_json(result, out, auto_unbox = TRUE, digits = 10)
cat("wrote", out, "\n")
