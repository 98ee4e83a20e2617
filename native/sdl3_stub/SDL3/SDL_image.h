/* Minimal SDL3_image surface for the headless reference build (see
 * SDL.h in this directory). IMG_Load never opens the file: it returns
 * a small zeroed surface — texture CONTENT is render-only in every
 * reference game, so rewards/termination are unaffected. */
#ifndef SDL3_STUB_SDL_IMAGE_H
#define SDL3_STUB_SDL_IMAGE_H

#include <SDL3/SDL.h>

#ifdef __cplusplus
extern "C" {
#endif

#define IMG_INIT_PNG 2

int IMG_Init(int flags);
SDL_Surface *IMG_Load(const char *file);

#ifdef __cplusplus
}
#endif
#endif
