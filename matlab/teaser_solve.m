function [s, R, t, time_taken] = teaser_solve(src, dst, opts)
%TEASER_SOLVE Solve dst = s * R * src + t robustly from MATLAB.
%
%   MATLAB front-end for the teaserpp_tpu registration engine, playing the
%   role of the reference's mex gateway (reference matlab/teaser_solve.m +
%   teaser_mex.cc): named parameters in, [s, R, t, time_taken] out. Instead
%   of a compiled mex binary it round-trips through the framework's CLI
%   (python -m teaserpp_tpu.cli), which keeps the MATLAB side toolbox-free
%   and works against a remote TPU host just as well as a local one.
%
%   [s, R, t, time_taken] = TEASER_SOLVE(src, dst, Name=Value) where src and
%   dst are 3-by-N matrices of corresponding points. time_taken is the solve
%   wall time in seconds as reported by the engine.
%
%   Name-value parameters (defaults match the reference wrapper):
%     Cbar2 (1), NoiseBound (0.03), EstimateScaling (true),
%     RotationEstimationAlgorithm (0 = GNC-TLS, 1 = FGR, 2 = QUATRO),
%     RotationGNCFactor (1.4), RotationMaxIterations (100),
%     RotationCostThreshold (0.005),
%     InlierSelectionAlgorithm (0 = PMC_EXACT, 1 = PMC_HEU, 2 = KCORE_HEU,
%     3 = NONE), KCoreHeuThreshold (0.5), Python ("python3").
%
%   Requires: MATLAB R2021a+ (arguments block), a Python environment with
%   teaserpp_tpu importable.

arguments
    src (3, :) double
    dst (3, :) double
    opts.Cbar2 (1, 1) double {mustBePositive} = 1
    opts.NoiseBound (1, 1) double = 0.03
    opts.EstimateScaling (1, 1) logical = true
    opts.RotationEstimationAlgorithm (1, 1) double = 0
    opts.RotationGNCFactor (1, 1) double = 1.4
    opts.RotationMaxIterations (1, 1) double = 100
    opts.RotationCostThreshold (1, 1) double = 0.005
    opts.InlierSelectionAlgorithm (1, 1) double = 0
    opts.KCoreHeuThreshold (1, 1) double = 0.5
    opts.Python (1, 1) string = "python3"
end

rot_algs = ["GNC_TLS", "FGR", "QUATRO"];
sel_modes = ["PMC_EXACT", "PMC_HEU", "KCORE_HEU", "NONE"];

work = tempname;
mkdir(work);
cleaner = onCleanup(@() rmdir(work, 's'));
src_path = fullfile(work, "src.ply");
dst_path = fullfile(work, "dst.ply");
write_ply(src_path, src);
write_ply(dst_path, dst);

cmd = sprintf(['%s -m teaserpp_tpu.cli --src "%s" --dst "%s" ' ...
    '--noise-bound %.17g --cbar2 %.17g ' ...
    '--rotation-estimation-algorithm %s --rotation-gnc-factor %.17g ' ...
    '--rotation-max-iterations %d --rotation-cost-threshold %.17g ' ...
    '--inlier-selection-mode %s --kcore-heuristic-threshold %.17g'], ...
    opts.Python, src_path, dst_path, ...
    opts.NoiseBound, opts.Cbar2, ...
    rot_algs(opts.RotationEstimationAlgorithm + 1), opts.RotationGNCFactor, ...
    opts.RotationMaxIterations, opts.RotationCostThreshold, ...
    sel_modes(opts.InlierSelectionAlgorithm + 1), opts.KCoreHeuThreshold);
if opts.EstimateScaling
    cmd = cmd + " --estimate-scaling";
end

[status, out] = system(cmd);
if status ~= 0
    error("teaser_solve:engine", "registration engine failed:\n%s", out);
end

% The CLI prints one JSON object on its last non-empty line.
lines = splitlines(strtrim(string(out)));
result = jsondecode(lines(end));
s = result.scale;
R = result.rotation;  % jsondecode turns the nested row lists into a 3x3
t = result.translation(:);
time_taken = result.time_taken;
end

function write_ply(path, pts)
% Minimal binary-little-endian PLY vertex writer (float32 x/y/z).
fid = fopen(path, "w");
closer = onCleanup(@() fclose(fid));
n = size(pts, 2);
header = "ply" + newline + "format binary_little_endian 1.0" + newline + ...
    "element vertex " + n + newline + ...
    "property float x" + newline + "property float y" + newline + ...
    "property float z" + newline + "end_header" + newline;
fwrite(fid, char(header), "char");
fwrite(fid, single(pts), "single", 0, "ieee-le");
end
